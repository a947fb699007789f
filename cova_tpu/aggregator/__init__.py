from cova_tpu.aggregator.associator import Associator, BoxRec  # noqa: F401
