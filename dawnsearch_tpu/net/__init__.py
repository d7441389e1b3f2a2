"""P2P networking: msgpack-over-UDP packets, peer service, tracker.

Rebuild of the reference's hand-rolled distributed layer
(/root/reference/src/net/{udp_packets,udp_service}.rs and
src/bin/dawntrack.rs): tracker-coordinated open membership, best-effort
query fan-out with a fixed collection deadline, i24-quantized embedding
wire format, compressed insert replication. This is the *DCN/host* tier
of the distribution story; intra-pod sharding rides ICI via XLA
collectives (dawnsearch_tpu.parallel).
"""
