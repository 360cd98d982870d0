"""aicovergen_tpu — a TPU-native AI song-cover framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SociallyIneptWeeb/AICoverGen (reference mounted read-only at /root/reference):

  * MDX-Net source separation (vocals / instrumental / backup / de-reverb)
    executed through a native ONNX-graph -> JAX frontend (convert/onnx).
  * RVC voice conversion: HuBERT features, f0 estimation (RMVPE / CREPE /
    autocorrelation / DIO), FAISS-index retrieval blending, and the
    VITS-flow + NSF-HiFiGAN synthesizer — all as functional JAX models.
  * TPU-parallel DSP: STFT/iSTFT, mel, IIR filtering, resampling,
    Freeverb-style reverb, compressor, phase-vocoder pitch shift.
  * Sharded chunk-batch execution over a `jax.sharding.Mesh` for
    multi-chip data parallelism.

Audio enters and leaves through a thin host I/O boundary (io/); everything
between decode and encode stays on-device.
"""

__version__ = "0.1.0"
