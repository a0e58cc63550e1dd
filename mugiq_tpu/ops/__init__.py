from .dslash import dslash_hop, dslash_hop_dagger
