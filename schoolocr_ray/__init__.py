"""schoolocr_ray: a Ray-Data-native per-turn content-extraction engine with
the query/data-processing capabilities of LISA-ITMO/SchoolOCR, re-targeted to
Parquet transcript tables (see SURVEY.md)."""
__version__ = "0.1.0"
