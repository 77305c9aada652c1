from rtf_tpu.gi.photon import shoot_photons, PhotonMapData  # noqa: F401
from rtf_tpu.gi.grid import build_photon_grid, estimate_irradiance, PhotonGrid  # noqa: F401
