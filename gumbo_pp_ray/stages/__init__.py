"""Ray Data batch transforms (the engine's operators as stages)."""

from .assemble import assemble_html
from .split import SplitMegaDocs
from .extractor import ExtractSpans, EXTRACTED_SCHEMA
from .reassemble import reassemble_chunks

__all__ = ["assemble_html", "SplitMegaDocs", "ExtractSpans",
           "EXTRACTED_SCHEMA", "reassemble_chunks"]
