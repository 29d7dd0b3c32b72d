"""Model zoo: learned reasoning models (OPNet family + baselines),
programmed reasoners, and the perception (detection) stack."""
