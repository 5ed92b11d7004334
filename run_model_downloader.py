"""Model downloader (reference: ``run_model_downloader.py``).

Fetches the reference release checkpoints (aligner, ToucanTTS_Meta,
Avocodo, BigVGAN, embedding function, embedding GAN) — they load directly
through ``toucan_tpu.compat.load``.  Requires network access.
"""

import os
import urllib.request

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")
RELEASE = ("https://github.com/DigitalPhonetics/IMS-Toucan/releases/download/v2.5")

CHECKPOINTS = {
    os.path.join("Aligner", "aligner.pt"): f"{RELEASE}/aligner.pt",
    os.path.join("ToucanTTS_Meta", "best.pt"): f"{RELEASE}/ToucanTTS_Meta.pt",
    os.path.join("Avocodo", "best.pt"): f"{RELEASE}/Avocodo.pt",
    os.path.join("BigVGAN", "best.pt"): f"{RELEASE}/BigVGAN.pt",
    os.path.join("Embedding", "embedding_function.pt"):
        f"{RELEASE}/embedding_function.pt",
    os.path.join("Embedding", "embedding_gan.pt"): f"{RELEASE}/embedding_gan.pt",
}


def download_models():
    for rel_path, url in CHECKPOINTS.items():
        target = os.path.join(MODELS_DIR, rel_path)
        if os.path.exists(target):
            print(f"exists: {target}")
            continue
        os.makedirs(os.path.dirname(target), exist_ok=True)
        print(f"downloading {url} -> {target}")
        try:
            urllib.request.urlretrieve(url, target)
        except Exception as e:
            print(f"  failed ({e}); download manually if this host has no egress")


if __name__ == "__main__":
    download_models()
