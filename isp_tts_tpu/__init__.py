"""isp_tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) non-autoregressive TTS framework.

A from-scratch rebuild, TPU-first, of the capabilities of the reference
`ilya16/isp-tts` system (FastPitch/Matcha-TTS-style acoustic model):

- ALiBi-MQA Transformer text encoder / mel decoder
- ConvAttention aligner with Monotonic Alignment Search binarization
  (TPU-native: vectorized `lax.scan` DP + Pallas wavefront kernel)
- Flow-matching temporal adaptor (OT-CFM training, Euler ODE inference,
  AdaLN time conditioning)
- JAX-jitted audio front-end (magnitude STFT -> slaney mel -> log compress,
  YIN pitch, log1p energy)
- Data pipeline with bucketed static-shape batching (TPU-friendly)
- Trainer with optax, data-parallel `jax.sharding.Mesh` execution,
  self-describing checkpoints, callbacks, tensorboard logging
"""

__version__ = "0.1.0"
