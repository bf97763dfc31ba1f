"""Host-side data layer (numpy): camera ray casting, nuScenes-format scene
loading, synthetic scenes, and mixed patch/pixel/LiDAR batching."""
