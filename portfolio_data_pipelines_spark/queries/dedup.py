"""Deduplication declared queries (SURVEY §2.10) — filled in milestone M4."""

from __future__ import annotations
