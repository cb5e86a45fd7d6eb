"""Sources and sinks (SURVEY §2.1 S1-S13)."""

from .readers import (  # noqa: F401
    load_sample_bundle,
    read_component_csv,
    read_inference_results,
    read_labels_csv,
    read_tags_description,
    read_timeranges_txt,
)
from .sinks import (  # noqa: F401
    write_component_csvs,
    write_inference_chunks,
)
from .catalog import Catalog  # noqa: F401
from .warc import read_warc, write_warc  # noqa: F401
