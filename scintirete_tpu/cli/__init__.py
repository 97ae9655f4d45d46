"""Entry points: server binary and interactive CLI."""
