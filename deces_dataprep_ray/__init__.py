"""Ray-Data-native inverted-index builder + BM25 query engine."""
