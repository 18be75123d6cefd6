"""Declarative check specs, suite runner, checkpoint/lineage/resume."""
