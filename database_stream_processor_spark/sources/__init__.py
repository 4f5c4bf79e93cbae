"""Sources & sinks (reference: SURVEY.md §2.1, crates/dbsp/src/operator/
{input,output,csv}.rs and crates/adapters/src/transport/).

- :mod:`handles` — input-handle semantics: Z-set pushes, *set* insert/delete
  commands, *map* upserts (src/operator/input.rs:75,230,313).
- :mod:`files` — file/CSV/JSON/Parquet transports + the output handle
  (src/operator/csv.rs, output.rs; adapters/src/transport/file.rs).
- :mod:`kafka` — Kafka transport binding over Spark's built-in
  ``format("kafka")`` (adapters/src/transport/kafka/).
- :mod:`http` — HTTP ingress poll-source / egress POST sink
  (adapters/src/transport/http/).
"""

from database_stream_processor_spark.sources.files import (
    OutputHandle,
    read_csv,
    read_json,
    read_parquet,
    read_zset,
    write_zset,
)
from database_stream_processor_spark.sources.handles import (
    Generator,
    MapInput,
    SetInput,
    StreamInput,
    indexed_zset_input,
    zset_input,
)
from database_stream_processor_spark.sources.http import (
    HttpOutput,
    http_poll_source,
)

__all__ = [
    "Generator",
    "HttpOutput",
    "MapInput",
    "OutputHandle",
    "SetInput",
    "StreamInput",
    "http_poll_source",
    "indexed_zset_input",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_zset",
    "write_zset",
    "zset_input",
]
