"""Prosody-cloning demo (reference: ``run_prosody_override.py``)."""

import argparse
import os

from toucan_tpu.compat.load import interface_from_torch, load_aligner
from toucan_tpu.data.corpus import read_wave
from toucan_tpu.infer.cloner import UtteranceCloner

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("reference_audio")
    parser.add_argument("transcript")
    parser.add_argument("--voice_audio", default=None)
    parser.add_argument("--lang", default="en")
    parser.add_argument("--out", default="cloned.wav")
    args = parser.parse_args()

    tts = interface_from_torch(
        tts_path=os.path.join(MODELS_DIR, "ToucanTTS_Meta", "best.pt"),
        vocoder_path=os.path.join(MODELS_DIR, "Avocodo", "best.pt"),
        embedding_path=os.path.join(MODELS_DIR, "Embedding", "embedding_function.pt"),
        language=args.lang)
    aligner_vars = load_aligner(os.path.join(MODELS_DIR, "Aligner", "aligner.pt"))
    cloner = UtteranceCloner(tts, aligner_vars, language=args.lang)

    wave, sr = read_wave(args.reference_audio)
    voice = None
    if args.voice_audio:
        voice, _ = read_wave(args.voice_audio)
    cloner.clone_utterance(wave, args.transcript, reference_wave_for_voice=voice,
                           sr=sr, lang=args.lang, filename_of_result=args.out)
    print(f"wrote {args.out}")
