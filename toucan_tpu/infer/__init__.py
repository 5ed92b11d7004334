from toucan_tpu.infer.interface import ToucanTTSInterface
