"""Sources & storage: fixture generators, the frontier table store."""
