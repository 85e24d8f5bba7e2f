"""CLI entry points with the reference's flag surface and JSON-config
merge semantics (train_ddgan.py / test_ddgan.py / main.py / pso)."""
