"""End-to-end staged plans: pipeline, oracle, verification."""
