from toucan_tpu.models.vocoders.hifigan import HiFiGANGenerator
from toucan_tpu.models.vocoders.bigvgan import BigVGAN
