"""dreamgaussian_tpu — a TPU-native (JAX/XLA/Pallas) DreamGaussian framework.

A from-scratch reimplementation of the capabilities of
dreamgaussian/dreamgaussian (arXiv 2309.16653) designed for TPU hardware:

- differentiable 3D Gaussian splatting rasterizer built on Pallas tile
  kernels whose per-tile front-to-back compositing is reformulated as
  triangular-matmul prefix products on the MXU (replaces the CUDA
  ``diff-gaussian-rasterization`` extension),
- fixed-capacity masked Gaussian scene state so densify/prune stay
  shape-static under ``jit`` (replaces in-place optimizer surgery),
- SDS guidance (Stable Diffusion / Zero123 / MVDream / ImageDream) with a
  JAX DDIM scheduler and Flax diffusion backbones,
- marching-cubes mesh extraction, UV texture baking, and a differentiable
  mesh rasterizer for the stage-2 texture refinement (replaces nvdiffrast),
- tile/data-sharded rendering and training over ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
