"""Ray-drop subsystem: learn which simulated LiDAR rays a real sensor would
return (U-Net over range images + perceptual losses), then export realistic
labeled point clouds in SemanticKITTI format."""
