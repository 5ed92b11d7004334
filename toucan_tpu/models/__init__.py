from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig
