from mtamrecommender_tpu.models.registry import MODEL_REGISTRY, get_model  # noqa: F401
