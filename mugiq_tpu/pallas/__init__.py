from .dslash_kernel import (dslash_hop_pallas, to_kernel_spinor,
                            from_kernel_spinor, to_kernel_gauge)
