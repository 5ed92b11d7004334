"""toucan-tpu: a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

Provides the full capability surface of the IMS-Toucan (Prosody-Variance)
toolkit — articulatory text frontend, ToucanTTS acoustic model, CTC aligner,
GST style embedding, Avocodo/BigVGAN vocoders, prosody cloning and
controllable inference — re-designed TPU-first rather than ported.

Subpackages:
  frontend   text -> articulatory features; audio -> log-mel (host + JAX DSP)
  nn         reusable flax modules (conformer, predictors, flows, ...)
  kernels    pallas TPU kernels for the hot ops
  models     full model assemblies (ToucanTTS, aligner, vocoders, GST)
  train      optimizers, schedules, losses, train loops, checkpointing
  data       corpus recipes and dataset cache building
  dist       mesh construction and sharding specs
  infer      end-to-end inference interfaces (TTS facade, cloner, control)
"""

__version__ = "0.1.0"
