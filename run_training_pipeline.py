"""CLI entry point (reference: ``run_training_pipeline.py``)."""

from toucan_tpu.cli import main

if __name__ == "__main__":
    main()
