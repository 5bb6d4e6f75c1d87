"""Reusable operator helpers: skew handling, observability."""
