"""Pipelines: the single CLI entry and asset-creation orchestration."""
