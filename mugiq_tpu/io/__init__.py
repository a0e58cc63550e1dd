from .hdf5io import write_loops_hdf5_mom, write_loops_hdf5_pos
