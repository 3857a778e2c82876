"""Logical pipeline plans: stage orchestration, checkpoint/resume."""
