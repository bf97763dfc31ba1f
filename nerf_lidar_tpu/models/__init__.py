"""Model layer: ZipNeRF MLP family, scene Model, pose/track refinement,
ray-drop U-Net."""
