"""DataFrame operators — thin, composable, built-ins-first (SURVEY §2)."""
