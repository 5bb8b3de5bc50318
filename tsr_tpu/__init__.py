"""tsr_tpu — TPU-native Restoration-First Traffic Sign Recognition framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
project *Image-Restoration-for-Road-Sign-Recognition-in-Autonomous-Driving*
(see /root/reference, cited throughout as ``ref:<file>:<lines>``):

- on-device batched distortion simulators (AWGN, linear motion blur,
  atmospheric-scattering fog, compound and random mixes) replacing the
  reference's per-image cv2/numpy loops (ref:02/03/04/16/14),
- Flax U-Net / ResUNet restoration models (ref:07:75-120, ref:14:96-186),
- a VGG16 judge classifier + shared feature extractor powering the
  perceptual loss and interpretability taps (ref:05, ref:07adv:95-112,
  ref:11, ref:12),
- fused restore→classify batched evaluation (replacing ref:08/17/18's
  file-system round trips),
- orbax checkpoints with torch ``.pth`` interop,
- data/model-parallel training over a ``jax.sharding.Mesh``.

Layout is NHWC (TPU-native); the torch interop layer handles NCHW mapping.
"""

__version__ = "0.1.0"

from tsr_tpu import configs  # noqa: F401
