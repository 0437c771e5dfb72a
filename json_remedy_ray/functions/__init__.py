"""Driver-facing query callables + their DuckDB oracle SQL."""
