"""uncertainty-nerf-gs-tpu: TPU-native uncertainty-aware NeRF / 3DGS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
AaltoML/uncertainty-nerf-gs (ECCV 2024 UnCV, arXiv 2409.06407): radiance-field
scene reconstruction (nerfacto-style NeRF, splatfacto-style 3D Gaussian
Splatting) with per-pixel predictive uncertainty via

  * aleatoric variance heads   ("active-nerfacto", "active-splatfacto")
  * MC-dropout                 ("nerfacto-mcdropout")
  * linearized Laplace         ("nerfacto-laplace")
  * deep ensembles             (eval-time pipeline)

plus the AUSE/AUCE/NLL uncertainty metrics, corruption/OOD study harnesses and
dataparsers. The design is TPU-first: one functional core where every
uncertainty mechanism is a `vmap`-ed axis over a shared render path, sharded
over a `jax.sharding.Mesh`, with Pallas kernels for the hot ops (hash-grid
encoding, tile rasterization).
"""

__version__ = "0.1.0"
