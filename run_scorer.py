"""Data-QA scoring demo (reference: ``run_scorer.py``)."""

import argparse
import os

from toucan_tpu.compat.load import load_aligner
from toucan_tpu.data.corpus import load_cache
from toucan_tpu.data.scorer import AlignmentScorer

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("cache", help="path to an aligner or fastspeech cache (.npz)")
    parser.add_argument("--aligner", default=os.path.join(MODELS_DIR, "Aligner",
                                                          "aligner.pt"))
    parser.add_argument("--worst", type=int, default=20)
    args = parser.parse_args()

    dataset = load_cache(args.cache)
    scorer = AlignmentScorer(load_aligner(args.aligner))
    scores = scorer.score(dataset)
    print("worst samples by aligner CTC loss:")
    for idx in scorer.worst_n(args.worst):
        print(f"  [{idx}] ctc={scores[idx]:.4f}  {dataset[idx].get('path', '')}")
