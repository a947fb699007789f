from cova_tpu.pipeline.compressed import CompressedStage, compressed_stage_step  # noqa: F401
