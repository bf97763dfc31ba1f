"""LiDAR simulation: sensor sweep patterns, scene-coordinate transforms,
sweep rendering through the trained field, range-image projection, and
SemanticKITTI export."""
