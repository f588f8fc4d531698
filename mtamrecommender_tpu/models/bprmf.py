"""BPRMF: matrix factorization with a pairwise BPR loss.

Port of `/root/reference/Model/BPRMF.py`.  The model's forward pass is
just the user embedding (prediction scores = u . item_table^T + bias);
the BPR pairwise loss with one shared random negative per step lives in
``models.base.bpr_loss``.
"""

from __future__ import annotations

import jax

from mtamrecommender_tpu.models import base
from mtamrecommender_tpu.ops import initializers as init
from mtamrecommender_tpu.ops.embedding import init_behavior_embedding, pad_vocab


def init_bprmf(rng, cfg, meta):
    ke, kb = jax.random.split(rng)
    return {
        "embedding": init_behavior_embedding(ke, meta, cfg.num_units, vocab_pad_multiple=cfg.vocab_pad_multiple),
        # item bias table [item_count+3, 1] (BPRMF.py:34-35)
        "item_bias": init.embedding_uniform(kb, (pad_vocab(meta.item_vocab, cfg.vocab_pad_multiple), 1)),
    }


def apply_bprmf(params, cfg, batch, *, train, rng):
    e = base.embed(params, batch, cfg.use_pallas)
    return base.ModelOutput(e.user_emb, e)
