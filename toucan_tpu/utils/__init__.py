from toucan_tpu.utils.profiling import profile_trace, StepTimer
from toucan_tpu.utils.audio_io import float2pcm
