"""Sources/sinks: schema-enforced table IO (SURVEY.md §2.1 S1-S9)."""
