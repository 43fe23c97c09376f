"""Deterministic adversarial test fixtures (generator port)."""
