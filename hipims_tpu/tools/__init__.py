"""Out-of-process tooling (model generation), mirroring the reference's
Node.js tools/model-builder."""
