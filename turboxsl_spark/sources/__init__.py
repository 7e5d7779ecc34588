from turboxsl_spark.sources.transcripts import (
    gen_transcripts_pdf,
    gen_transcripts,
    gen_tool_catalog_pdf,
    gen_tool_catalog,
    transcripts_from_events,
    TRANSCRIPT_SCHEMA,
)
from turboxsl_spark.sources.tables import load_table, load_all, register_views

__all__ = [
    "gen_transcripts_pdf",
    "gen_transcripts",
    "gen_tool_catalog_pdf",
    "gen_tool_catalog",
    "transcripts_from_events",
    "TRANSCRIPT_SCHEMA",
    "load_table",
    "load_all",
    "register_views",
]
