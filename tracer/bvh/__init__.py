"""tracer.bvh"""
