"""Data layer: dataset shells, video chunking, collation, mesh loading."""
