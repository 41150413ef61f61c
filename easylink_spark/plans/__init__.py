"""End-to-end pipeline drivers (the reference's pipeline-schema analog)."""
