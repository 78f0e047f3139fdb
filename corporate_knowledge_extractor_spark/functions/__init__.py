"""Reusable column expressions and shared rule constants."""
