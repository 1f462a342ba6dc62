"""CLI drivers (SURVEY §2.3 L5)."""
