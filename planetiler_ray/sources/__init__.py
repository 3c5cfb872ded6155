"""Sources: deterministic synthetic-world generation (pages / admin polygons /
POIs derived from the sf testdata tables) and input readers."""
