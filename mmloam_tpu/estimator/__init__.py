"""Sliding-window MAP estimator (TPU-native replacement for lio/Estimator.cpp)."""
