"""TPU-native news-recommendation framework for the Microsoft MIND dataset.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``AhmedFahim-git/news_recommendation_project_v2`` (reference mounted read-only at
``/root/reference``): MIND ingest, a string->index behavior compiler, frozen/trainable
news encoders, a family of user-history pooling towers, margin-ranking training with
per-epoch negative resampling, cold-start score composition, and the official MIND
AUC/MRR/nDCG metric suite — rebuilt TPU-first:

- static bucketed shapes + masking instead of dynamic per-batch padding
  (reference pads to batch max: ``data_utils.py:723-781``),
- blocked on-device impression scoring instead of a per-impression Python loop
  (reference: ``data_model_helper.py:197-239``),
- a device mesh + sharded news-embedding table instead of a host-RAM tensor
  (reference: ``components.py:239-257``),
- ``jax.random`` key discipline instead of global seeds (reference: ``config.py:55-56``).
"""

__version__ = "0.1.0"
