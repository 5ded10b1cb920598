"""Similarity-search declared queries (SURVEY §2.10) — filled in milestone M5."""

from __future__ import annotations
