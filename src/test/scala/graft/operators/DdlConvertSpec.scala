package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Physical→logical DDL conversion (DDLConverter.convertNormalDDL
  * analog) — the statements a vanilla MySQL consumer of the produced
  * global binlog can replay. Cases pinned by the reference's own
  * DDLConverterTest where it asserts, and by its printed corpus
  * otherwise. */
class DdlConvertSpec extends AnyFunSuite {
  private def c(sql: String): String = DdlConvert.toLogicalDdl(sql)

  test("CREATE INDEX: partition clauses and dialect words strip (reference-asserted case)") {
    // DDLConverterTest.testCreateIndex asserts exactly this conversion
    assert(c("CREATE INDEX gsi ON alter_partition_ddl_primary_table (id) PARTITION BY HASH (id)") ==
      "CREATE INDEX gsi ON alter_partition_ddl_primary_table (id)")
    assert(c("CREATE INDEX gsi ON t (id) tbpartition BY HASH (id) tbpartitions 16") ==
      "CREATE INDEX gsi ON t (id)")
    assert(c("CREATE CLUSTERED INDEX `ap_index` ON `t` (`id`)") ==
      "CREATE INDEX `ap_index` ON `t` (`id`)")
    assert(c("CREATE UNIQUE CLUSTERED INDEX `ap_index` ON `t` (`id`)") ==
      "CREATE UNIQUE INDEX `ap_index` ON `t` (`id`)")
    assert(c("CREATE LOCAL INDEX l_i ON t (i)") ==
      "CREATE INDEX l_i ON t (i)")
  }

  test("ALTER TABLE: ALGORITHM=OMC items drop; GLOBAL/CLUSTERED/LOCAL words and partition sub-clauses strip from ADD INDEX") {
    assert(c("ALTER TABLE `auto_partition_idx_tb` ADD UNIQUE CLUSTERED INDEX `ap_index` (`id`)") ==
      "ALTER TABLE `auto_partition_idx_tb` ADD UNIQUE INDEX `ap_index` (`id`)")
    assert(c("ALTER TABLE t ADD LOCAL INDEX li (i)") ==
      "ALTER TABLE t ADD INDEX li (i)")
    assert(c("ALTER TABLE t ADD GLOBAL INDEX g (a) DBPARTITION BY HASH(a)") ==
      "ALTER TABLE t ADD INDEX g (a)")
    assert(c("alter table omc_tbl change column c cc bigint first ALGORITHM=OMC") ==
      "alter table omc_tbl change column c cc bigint first")
    assert(c("alter table nnn change column b bb bigint, ALGORITHM=OMC") ==
      "alter table nnn change column b bb bigint")
    // a NON-blacklisted algorithm is vanilla MySQL and stays
    assert(c("alter table nnn change column b bb bigint, ALGORITHM=INPLACE") ==
      "alter table nnn change column b bb bigint, ALGORITHM=INPLACE")
    // untouched items keep their exact text
    assert(c("ALTER TABLE t ADD COLUMN v varchar(10) DEFAULT 'x'") ==
      "ALTER TABLE t ADD COLUMN v varchar(10) DEFAULT 'x'")
  }

  test("ALTER TABLE with a schema-qualified name: the name run is skipped, dialect words still strip") {
    // `db`.`t` lexes as TWO tokens (the dot is not a token) — the item
    // scan must skip the whole name run or the ADD-prefix guard fails
    // and GLOBAL/CLUSTERED leak into the 'logical' stream
    assert(c("ALTER TABLE db.t ADD GLOBAL INDEX g (a)") ==
      "ALTER TABLE db.t ADD INDEX g (a)")
    assert(c("ALTER TABLE `db`.`t` ADD UNIQUE CLUSTERED INDEX `i` (`a`)") ==
      "ALTER TABLE `db`.`t` ADD UNIQUE INDEX `i` (`a`)")
    assert(c("ALTER TABLE `db`.`t` ADD GLOBAL INDEX g (a) DBPARTITION BY HASH(a)") ==
      "ALTER TABLE `db`.`t` ADD INDEX g (a)")
    assert(c("alter table db.omc change column c cc bigint ALGORITHM=OMC") ==
      "alter table db.omc change column c cc bigint")
    // qualified + multi-item: first item's guard unaffected by the name
    assert(c("ALTER TABLE db.t ADD LOCAL INDEX li (i), ADD COLUMN x int") ==
      "ALTER TABLE db.t ADD INDEX li (i), ADD COLUMN x int")
    // untouched qualified statements stay verbatim
    assert(c("ALTER TABLE db.t ADD COLUMN v varchar(10)") ==
      "ALTER TABLE db.t ADD COLUMN v varchar(10)")
  }

  test("CREATE TABLE: implicit id + its PK, GLOBAL index elements, LOCAL words, sequence types and every sharding clause strip") {
    val physical = "CREATE TABLE `tb` (\n" +
      "  `a` int NOT NULL,\n" +
      "  `b` varchar(10) DEFAULT NULL,\n" +
      "  GLOBAL INDEX g (`a`) DBPARTITION BY HASH(`a`),\n" +
      "  LOCAL KEY `lk` (`b`),\n" +
      "  _drds_implicit_id_ bigint AUTO_INCREMENT,\n" +
      "  PRIMARY KEY (_drds_implicit_id_)\n" +
      ") ENGINE = InnoDB DEFAULT CHARSET = utf8mb4\n" +
      "DBPARTITION BY RIGHT_SHIFT(`a`, 9)\n" +
      "TBPARTITION BY YYYYMM(`b`) TBPARTITIONS 7"
    assert(c(physical) ==
      "CREATE TABLE `tb` ( `a` int NOT NULL, `b` varchar(10) DEFAULT " +
        "NULL, KEY `lk` (`b`)) ENGINE = InnoDB DEFAULT CHARSET = utf8mb4")
    assert(c("CREATE TABLE t (a INT) BROADCAST") == "CREATE TABLE t (a INT)")
    assert(c("CREATE TABLE t (a INT) SINGLE") == "CREATE TABLE t (a INT)")
    assert(c("CREATE TABLE t (a INT) tablegroup `tg1`") ==
      "CREATE TABLE t (a INT)")
    assert(c("CREATE TABLE t (a INT) LOCALITY = 'dn=dn1'") ==
      "CREATE TABLE t (a INT)")
    assert(c("CREATE TABLE t (id bigint AUTO_INCREMENT BY GROUP, a INT, PRIMARY KEY (id))") ==
      "CREATE TABLE t (id bigint AUTO_INCREMENT, a INT, PRIMARY KEY (id))")
    // a RANGE partitioning with a partition LIST consumes whole
    assert(c("CREATE TABLE t (a INT) PARTITION BY RANGE (a) " +
      "(PARTITION p0 VALUES LESS THAN (10), PARTITION p1 VALUES LESS THAN (20)) " +
      "ENGINE = InnoDB") == "CREATE TABLE t (a INT) ENGINE = InnoDB")
  }

  test("CREATE PARTITION TABLE prefix drops; CREATE DATABASE MODE/partition_mode strips (reference-corpus cases)") {
    // DDLConverterTest.testShard: the auto-partition PREFIX form
    // (Druid setPrefixPartition(false), DDLConverter.java:147-148)
    assert(c("CREATE PARTITION TABLE `t` (`id` bigint NOT NULL, PRIMARY KEY (`id`)) dbpartition by hash(`id`)") ==
      "CREATE TABLE `t` (`id` bigint NOT NULL, PRIMARY KEY (`id`))")
    assert(c("CREATE BROADCAST TABLE t (a INT)") == "CREATE TABLE t (a INT)")
    // DDLConverterTest.testDatabase + DdlHelperTest's MODE 'auto'
    // (setPartitionMode(null), DDLConverter.java:135)
    assert(c("create database d0 partition_mode='partitioning'") ==
      "create database d0")
    assert(c("CREATE DATABASE BalancerTestBase MODE 'auto'") ==
      "CREATE DATABASE BalancerTestBase")
    assert(c("create database if not exists d1 LOCALITY='dn=dn1'") ==
      "create database if not exists d1")
    // the parser folds the prefix form too
    val st = DdlParser.parse(
      "create PARTITION table d1.t1 (id int) dbpartition by hash(id)", "d")
    assert(st == DdlParser.CreateTable("d1", "t1",
      Vector(DdlParser.ColumnDef("id", "int")), Vector.empty, false))
  }

  test("pass-through: plain MySQL statements come back verbatim; tso adds the private-DDL comments") {
    val plain = "DROP TABLE IF EXISTS a, b"
    assert(DdlConvert.toLogicalDdl(plain) == plain)
    assert(DdlConvert.toLogicalDdl("RENAME TABLE a TO b") ==
      "RENAME TABLE a TO b")
    val withTso = DdlConvert.toLogicalDdl(
      "CREATE TABLE t (a INT) BROADCAST", Some("712345667788"))
    assert(withTso ==
      "# POLARX_ORIGIN_SQL=CREATE TABLE t (a INT) BROADCAST\n" +
        "# POLARX_TSO=712345667788\n" +
        "CREATE TABLE t (a INT)")
  }

  test("converted statements still evolve the decode registry identically (minus the implicit id)") {
    val physical = "CREATE TABLE `tb` (`a` int, `b` varchar(10), " +
      "_drds_implicit_id_ bigint AUTO_INCREMENT, " +
      "PRIMARY KEY (_drds_implicit_id_)) DBPARTITION BY HASH(`a`)"
    val logical = DdlConvert.toLogicalDdl(physical)
    val reg = graft.sinks.BinlogWire.evolveRegistry(Map.empty, "s", logical)
    assert(reg == Map(("s", "tb") -> Seq("a", "b")))
  }
}
