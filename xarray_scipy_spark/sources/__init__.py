from .tables import TABLES, load_table, load_tables, register_views
from .write import read_series, register_bucketed, write_bucketed, write_clustered, write_partitioned, write_series, write_zordered, zvalue
from .csvfile import read_csv, write_csv
from .jsonl import DOCUMENTS_JSONL_SCHEMA, read_jsonl, write_jsonl
from .orcfile import read_orc, write_orc
from .binaryfile import MEDIA_FORMATS, read_binary_files, sniff_media_format, stream_binary_files
from .xmlfile import read_xml, stream_xml, write_xml

__all__ = [
    "read_csv",
    "write_csv",
    "read_jsonl",
    "read_orc",
    "write_orc",
    "read_xml",
    "stream_xml",
    "write_xml",
    "write_jsonl",
    "DOCUMENTS_JSONL_SCHEMA",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "write_partitioned",
    "write_zordered",
    "zvalue",
    "write_bucketed",
    "register_bucketed",
    "write_series",
    "read_series",
    "read_binary_files",
    "stream_binary_files",
    "sniff_media_format",
    "MEDIA_FORMATS",
]
