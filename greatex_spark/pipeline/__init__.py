from greatex_spark.pipeline.checkpoint import Checkpoint, run_checkpoint  # noqa: F401
from greatex_spark.pipeline.runner import PipelineConfig, run_pipeline  # noqa: F401
