"""Graph analytics over KG edge tables (PageRank, degrees)."""
