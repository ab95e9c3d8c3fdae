from rxtpu.data.records import (  # noqa: F401
    MetadataIndex,
    load_metadata,
    stratified_split,
    split_by_experiment,
    image_path,
    get_celltype,
)
from rxtpu.data.stats import (  # noqa: F401
    compute_stats_streaming,
    load_stats,
    save_stats,
)
from rxtpu.data.pipeline import ByteStore, Pipeline, device_prefetch  # noqa: F401
from rxtpu.data.decode import decode_batch, decode_files, encode_batch_jpeg  # noqa: F401
from rxtpu.data.pack import PackStore, write_pack  # noqa: F401
