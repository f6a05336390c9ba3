CREATE DATABASE tpch;
USE tpch;
CREATE TABLE Lineitem (
    l_orderkey INT(8) NOT NULL,
    l_partkey INT(8) NOT NULL,
    l_suppkey INT(8) NOT NULL,
    l_linenumber INT(4) NOT NULL,
    l_quantity DECIMAL(10,2) NOT NULL,
    l_extendedprice DECIMAL(10,2) NOT NULL,
    l_discount DECIMAL(10,2) NOT NULL,
    l_tax DECIMAL(10,2) NOT NULL,
    l_returnflag CHAR(1) NOT NULL,
    l_linestatus CHAR(1) NOT NULL,
    l_shipdate DATETIME NOT NULL
);
CREATE TABLE Orders (
    o_orderkey INT(8) NOT NULL,
    o_custkey INT(8) NOT NULL,
    o_orderstatus CHAR(1) NOT NULL,
    o_totalprice DECIMAL(10,2) NOT NULL,
    o_orderdate DATETIME NOT NULL,
    o_orderpriority CHAR(15) NOT NULL
);
CREATE TABLE Customer (
    c_custkey INT(8) NOT NULL,
    c_name CHAR(25) NOT NULL,
    c_nationkey INT(4) NOT NULL,
    c_acctbal DECIMAL(10,2) NOT NULL,
    c_mktsegment CHAR(10) NOT NULL
);
CREATE TABLE Part (
    p_partkey INT(8) NOT NULL,
    p_name CHAR(55) NOT NULL,
    p_brand CHAR(10) NOT NULL,
    p_type CHAR(25) NOT NULL,
    p_size INT(4) NOT NULL,
    p_retailprice DECIMAL(10,2) NOT NULL
);
CREATE TABLE Supplier (
    s_suppkey INT(8) NOT NULL,
    s_name CHAR(25) NOT NULL,
    s_nationkey INT(4) NOT NULL,
    s_acctbal DECIMAL(10,2) NOT NULL
);
CREATE TABLE Nation (
    n_nationkey INT(4) NOT NULL,
    n_name CHAR(25) NOT NULL,
    n_regionkey INT(4) NOT NULL
);
CREATE TABLE Region (
    r_regionkey INT(4) NOT NULL,
    r_name CHAR(25) NOT NULL
);
