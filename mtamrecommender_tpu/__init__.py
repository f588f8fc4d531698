"""MTAMRecommender-TPU: a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
`cocoandpudding/MTAMRecommender` (arXiv 2005.08598): time-aware behavior
sequence embedding, the MTAM time-aware GRU + multi-hop attentive memory
reader, and the full baseline zoo (GRU4Rec, T-SeqRec, SASRec, TiSASRec,
NARM, LSTUR, STAMP, BPRMF, FPMC, PISTRec, TopPop) sharing one functional
training loop, one eval protocol, and one sharded embedding engine.

Design stance (vs. the TF-1.14 graph-mode reference):
  * fixed-shape packed batches (no feed_dict), functional `init/apply`
    models, a single jit-compiled train step and eval step;
  * `jax.sharding.Mesh` ('data','model') with row-sharded embedding
    tables (all-to-all ID exchange) and data-parallel dense towers;
  * Pallas TPU kernels for the hot ops (time-interval-biased attention,
    fused time-aware GRU cell, embedding gather/scatter-grad), each with
    a pure-jnp reference path selected by config flag.
"""

__version__ = "0.1.0"

from mtamrecommender_tpu.config import ExperimentConfig, get_preset  # noqa: F401
