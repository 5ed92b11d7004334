"""Interactive REPL demo (reference: ``run_interactive_demo.py``)."""

import os

from toucan_tpu.compat.load import interface_from_torch

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")

if __name__ == "__main__":
    lang = input("language code (e.g. en): ").strip() or "en"
    tts = interface_from_torch(
        tts_path=os.path.join(MODELS_DIR, "ToucanTTS_Meta", "best.pt"),
        vocoder_path=os.path.join(MODELS_DIR, "Avocodo", "best.pt"),
        embedding_path=os.path.join(MODELS_DIR, "Embedding", "embedding_function.pt"),
        language=lang)
    try:
        import sounddevice  # noqa: F401  (live playback if host audio exists)
        playback = True
    except (ImportError, OSError):
        playback = False
    index = 0
    while True:
        text = input("what should be read? (empty quits)\n").strip()
        if not text:
            break
        if playback:
            tts.read_aloud(text, blocking=True)
        else:
            tts.read_to_file([text], f"demo_output_{index}.wav", silent=False)
            print(f"wrote demo_output_{index}.wav")
            index += 1
