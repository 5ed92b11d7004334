"""Training CLI (``run_training_pipeline.py`` equivalent).

Dispatches named recipes with the reference's flag surface: pipeline name,
--gpu_id becomes --device (single-chip pinning is a CUDA concept; on TPU we
select mesh shape instead), --resume_checkpoint, --resume, --finetune,
--model_save_dir, --wandb; fixed seed 131714.
"""

from __future__ import annotations

import argparse
import os
import sys

SEED = 131714


def build_pipeline_dict():
    from toucan_tpu.recipes import (
        aligner_pipeline,
        avocodo_pipeline,
        bigvgan_pipeline,
        embedding_pipeline,
        finetuning_example,
        fs_embedding_integration_test_pipeline,
        integration_test_pipeline,
        meta_pipeline,
        nancy_pipeline,
        stochastic_nancy_pipeline,
    )
    return {
        "nancy": nancy_pipeline,
        "nancystoch": stochastic_nancy_pipeline,
        "meta": meta_pipeline,
        "fine_ex": finetuning_example,
        "tt_it": integration_test_pipeline,
        "fs_it": fs_embedding_integration_test_pipeline,
        "aligner": aligner_pipeline,
        "embedding": embedding_pipeline,
        "avocodo": avocodo_pipeline,
        "bigvgan": bigvgan_pipeline,
    }


def main(argv=None):
    pipeline_dict = build_pipeline_dict()
    parser = argparse.ArgumentParser(description="TPU-native IMS-Toucan training")
    parser.add_argument("pipeline", choices=sorted(pipeline_dict),
                        help="recipe to run")
    parser.add_argument("--n_data", type=int, default=None,
                        help="data-parallel mesh extent (default: all devices)")
    parser.add_argument("--n_model", type=int, default=1,
                        help="tensor-parallel mesh extent")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address host:port "
                             "(or env TOUCAN_COORDINATOR; omit on TPU pods "
                             "with --distributed for auto-detection)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multi-host process count (or env "
                             "TOUCAN_NUM_PROCESSES)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this host's process id (or env "
                             "TOUCAN_PROCESS_ID)")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize the multi-host runtime even with "
                             "no explicit coordinator flags (TPU pod "
                             "auto-detection)")
    parser.add_argument("--resume_checkpoint", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--finetune", action="store_true")
    parser.add_argument("--model_save_dir", type=str, default=None)
    parser.add_argument("--corpora_root", type=str, default=None)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--wandb_resume_id", type=str, default=None)
    args = parser.parse_args(argv)

    if args.corpora_root:
        os.environ["TOUCAN_CORPORA_ROOT"] = args.corpora_root

    if (args.distributed or args.coordinator or args.num_processes is not None
            or args.process_id is not None
            or "TOUCAN_COORDINATOR" in os.environ):
        from toucan_tpu.dist import initialize_distributed
        initialize_distributed(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    if args.wandb:
        try:
            import wandb
            wandb.init(name=f"{args.pipeline}", resume="must"
                       if args.wandb_resume_id else None,
                       id=args.wandb_resume_id)
        except ImportError:
            print("wandb not installed; continuing without logging")
            args.wandb = False

    pipeline_dict[args.pipeline](
        resume_checkpoint=args.resume_checkpoint,
        resume=args.resume,
        finetune=args.finetune,
        model_dir=args.model_save_dir,
        use_wandb=args.wandb,
        n_data=args.n_data,
        n_model=args.n_model,
        seed=SEED,
    )


if __name__ == "__main__":
    main()
