"""Trace-time scope for which op families use their Pallas kernels.

``ModelConfig.use_pallas`` is the master switch; ``pallas_scope`` narrows
it to a subset of op families so each kernel can be enabled (and
benchmarked) independently — honest per-op timing on the TPU showed the
kernels win or lose individually, not as a block.

Set via models/base._apply_trace_knobs at trace time, like scan_unroll.
"""

from __future__ import annotations

_ALL = frozenset({"gru", "attention", "embedding"})
_scope = _ALL


def set_scope(spec: str) -> None:
    """spec: 'all' or a comma-separated subset of {gru, attention,
    embedding}."""
    global _scope
    if spec == "all":
        _scope = _ALL
        return
    parts = {p.strip() for p in spec.split(",") if p.strip()}
    unknown = parts - _ALL
    if unknown:
        raise ValueError(f"unknown pallas_scope entries {sorted(unknown)}; "
                         f"valid: {sorted(_ALL)} or 'all'")
    _scope = frozenset(parts)


def enabled(family: str) -> bool:
    return family in _scope
