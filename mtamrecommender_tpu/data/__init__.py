from mtamrecommender_tpu.data.prepare import PreparedData, prepare_examples  # noqa: F401
from mtamrecommender_tpu.data.pipeline import PackedDataset, pack_examples, batch_iterator  # noqa: F401
