"""lb_wavenet_tpu — a TPU-native WaveNet vocoder framework (JAX/XLA/Pallas).

Brand-new design with the capability surface of `hrbigelow/lb-wavenet`
(see SURVEY.md): teacher-forced training of dilated-causal gated residual
stacks, mu-law 256-way output, mel/local + speaker/global conditioning, and
fast batched autoregressive synthesis via HBM ring buffers in one lax.scan.
"""
__version__ = "0.1.0"

from .config import ArchConfig, Config, GenConfig, TrainConfig  # noqa: F401
