"""Composable DataFrame operators: blocking joins, nearest-neighbor,
connected components, ER, dedup families, similarity search, top-k,
text quality, multimodal plumbing, graph analytics."""
