"""Broadcast state: compiled geocode index, parcel trees, lineage manifests."""
