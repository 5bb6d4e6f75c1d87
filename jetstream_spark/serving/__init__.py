"""The serving edge (H4) — outside Spark, fed by the engine's log."""
