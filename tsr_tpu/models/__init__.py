from tsr_tpu.models.resunet import ResidualBlock, ResUNet  # noqa: F401
from tsr_tpu.models.unet import SimpleUNet  # noqa: F401
from tsr_tpu.models.vgg import VGG16  # noqa: F401
