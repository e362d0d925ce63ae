O B-x O E-x
S-y O O
