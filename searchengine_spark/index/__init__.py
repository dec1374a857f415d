"""Physical compressed inverted index: codec, builder, query (WAND), resume."""
