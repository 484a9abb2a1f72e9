from quickwit_spark.sources.pages import synth_pages, PAGES_SCHEMA  # noqa: F401
