"""Input pipeline: datasets, crops, noise mixing."""
