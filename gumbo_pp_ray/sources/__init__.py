"""Sources / sinks: interleaved-table read + resumable partitioned write."""

from .io import read_interleaved, list_input_files, list_output_files

__all__ = ["read_interleaved", "list_input_files", "list_output_files"]
