"""Column-level functions (JVM-side where possible)."""
