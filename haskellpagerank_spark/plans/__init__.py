"""Iteration driving, checkpoint/resume, and plan utilities."""
