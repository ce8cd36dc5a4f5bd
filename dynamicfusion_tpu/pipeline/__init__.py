"""The per-frame DynamicFusion pipeline (KinFu equivalent) and rendering."""
