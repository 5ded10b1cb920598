"""Text-analysis declared queries (SURVEY §2.10) — filled in milestone M6."""

from __future__ import annotations
