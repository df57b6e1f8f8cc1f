from .report import (
    RecognitionReport,
    c_strftime_cpu,
    c_strftime_datetime,
    c_text_file_name,
    trainer_text_summary,
)

__all__ = [
    "RecognitionReport",
    "c_strftime_cpu",
    "c_strftime_datetime",
    "c_text_file_name",
    "trainer_text_summary",
]
