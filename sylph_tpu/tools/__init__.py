"""Runnable demos/tools inside the package."""
