"""The variant-detection engine: count table, graph walk, path finding,
quantification, classification and report generation."""
