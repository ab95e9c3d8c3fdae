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
