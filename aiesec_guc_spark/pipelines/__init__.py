"""End-to-end pipeline compositions of the engine's operators."""
