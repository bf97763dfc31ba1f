"""Pure-JAX (and Pallas) compute primitives: math, coordinates, step
functions, volume rendering, and the multiresolution hash-grid encoder."""
