"""tracer.opt"""
