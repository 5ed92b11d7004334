"""Read texts to an audio file (reference: ``run_text_to_file_reader.py``)."""

import argparse
import os

from toucan_tpu.compat.load import interface_from_torch

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")


def read_texts(model_id, sentences, filename, language="en", faster_vocoder=True):
    tts = interface_from_torch(
        tts_path=os.path.join(MODELS_DIR, f"ToucanTTS_{model_id}", "best.pt"),
        vocoder_path=os.path.join(MODELS_DIR,
                                  "Avocodo" if faster_vocoder else "BigVGAN",
                                  "best.pt"),
        embedding_path=os.path.join(MODELS_DIR, "Embedding",
                                    "embedding_function.pt"),
        vocoder_kind="hifigan" if faster_vocoder else "bigvgan",
        language=language)
    if isinstance(sentences, str):
        sentences = [sentences]
    tts.read_to_file(text_list=sentences, file_location=filename)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_id", default="Meta")
    parser.add_argument("--lang", default="en")
    parser.add_argument("--out", default="output.wav")
    parser.add_argument("text", nargs="+")
    args = parser.parse_args()
    read_texts(args.model_id, args.text, args.out, language=args.lang)
