"""ddgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Denoising-Diffusion-GAN framework.

Re-designed from scratch for TPU hardware with the full capability surface of
the reference (cloner174/Denoising-Diffusion-GAN, a fork of
NVlabs/denoising-diffusion-gan): DDGAN training/sampling, NCSN++ generator,
time-conditional discriminators, FIR resampling ops, EMA, PSO optimizers and
HPO, LUNA16/CIFAR/LSUN/CelebA/StackMNIST data pipelines, FID/IS evaluation,
JSON config system and compatible CLIs.

Everything on the compute path is functional JAX: a single jitted train step
sharded over a `jax.sharding.Mesh`, `lax.scan` samplers, Pallas kernels for
the hot FIR ops.
"""

__version__ = "0.1.0"
