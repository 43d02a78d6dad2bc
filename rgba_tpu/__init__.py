"""rgba_tpu — TPU-native RGBA learned image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Yoshiki172/Deep-Learning-based-RGBA-Image-Compression-with-Masked-Window-based-Attention
(reference mounted at /root/reference; cited per-module as file:line).

Two cooperating learned codecs:
  * a mask (alpha) codec  — GDN conv autoencoder + hyperprior + channel-wise
    autoregressive entropy model (reference models/AutoEncoderMask_Journal.py)
  * an RGB codec          — conv + masked window attention autoencoder whose
    attention windows are gated by a multiscale alpha pyramid
    (reference models/AutoEncoderRGB_Journal.py, layers/TransformRGB.py)

Layout is NHWC throughout (TPU-native); parameters are fp32, compute is
bf16-capable via a dtype policy; entropy math stays fp32.
"""

__version__ = "0.1.0"
