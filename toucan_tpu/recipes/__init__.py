from toucan_tpu.recipes.pipelines import (
    aligner_pipeline,
    avocodo_pipeline,
    bigvgan_pipeline,
    embedding_pipeline,
    finetuning_example,
    integration_test_pipeline,
    meta_pipeline,
    nancy_pipeline,
    stochastic_nancy_pipeline,
)
